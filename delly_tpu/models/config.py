"""Per-subcommand configuration (reference: Config structs in the drivers)."""

from __future__ import annotations

from dataclasses import dataclass, field



def _f32(*names):
    """Round the named float fields through float32: the reference
    stores them as C floats (tegua.h:61-64, delly.h:67-69), so
    exact-boundary comparisons like ratio > indelExtension must see
    0.7f, not the double 0.7."""
    import numpy as np

    def apply(cfg):
        for n in names:
            setattr(cfg, n, float(np.float32(getattr(cfg, n))))
    return apply


_SR_F32 = _f32("flank_quality", "mei_min_frac", "tr_min_frac")
_LR_F32 = _f32("indel_extension", "flank_quality", "mei_min_frac",
               "tr_min_frac")

@dataclass
class SrConfig:
    """delly sr options (delly.h:49-82, defaults delly.h:199-398)."""
    genome: str = ""
    files: list = field(default_factory=list)
    outfile: str = "-"
    exclude: str = ""
    vcffile: str = ""
    dumpfile: str = ""
    sample_names: list = field(default_factory=list)
    svtset: set = field(default_factory=set)
    min_map_qual: int = 1
    min_tra_qual: int = 20
    min_geno_qual: int = 5
    mad_cutoff: int = 9
    mad_normal_cutoff: int = 5
    min_clip: int = 25
    min_clique_size: int = 2
    min_ref_sep: int = 25
    max_read_sep: int = 40
    max_geno_read_count: int = 250
    max_read_per_sv: int = 20
    graph_pruning: int = 1000
    min_cons_window: int = 100
    max_threads: int = 4
    # hard-coded post-parse constants (delly.h:393-398)
    match: int = 5
    mismatch: int = -4
    gap_open: int = -10
    gap_ext: int = -1
    flank_quality: float = 0.95
    mei_min_frac: float = 0.8
    tr_min_frac: float = 0.85
    min_flank_size: int = 13
    indelsize: int = 1000
    nchr: int = 0

    def __post_init__(self):
        if self.min_geno_qual < 5:
            self.min_geno_qual = 5
        if self.min_clique_size < 2:
            self.min_clique_size = 2
        if self.min_map_qual > self.min_tra_qual:
            self.min_tra_qual = self.min_map_qual
        _SR_F32(self)


@dataclass
class LrConfig:
    """delly lr options (tegua.h:39-74, defaults tegua.h:209-422)."""
    genome: str = ""
    files: list = field(default_factory=list)
    outfile: str = "-"
    exclude: str = ""
    vcffile: str = ""
    dumpfile: str = ""
    altfile: str = ""
    sample_names: list = field(default_factory=list)
    svtset: set = field(default_factory=set)
    technology: str = "ont"
    min_map_qual: int = 1
    min_geno_qual: int = 5
    min_clip: int = 25
    min_clique_size: int = 3
    min_ref_sep: int = 30
    max_read_sep: int = 500
    max_geno_read_count: int = 250
    max_read_per_sv: int = 15
    graph_pruning: int = 1000
    min_cons_window: int = 1000
    max_threads: int = 4
    indel_extension: float = 0.5  # ont preset; pb = 0.7 (tegua.h:419-420)
    match: int = 5
    mismatch: int = -4
    gap_open: int = -10
    gap_ext: int = -1
    flank_quality: float = 0.9
    mei_min_frac: float = 0.8
    tr_min_frac: float = 0.85
    min_flank_size: int = 100
    indelsize: int = 10000
    geno_cap: int = 25
    methyl_window: int = 1000
    methyl_prob: int = 128
    min_cpg_depth: int = 5
    nchr: int = 0

    def __post_init__(self):
        if self.technology == "pb":
            self.indel_extension = 0.7
        if self.min_geno_qual < 5:
            self.min_geno_qual = 5
        _LR_F32(self)
