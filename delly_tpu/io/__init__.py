from delly_tpu.io.bgzf import bgzf_decompress, bgzf_compress, is_gzip
from delly_tpu.io.fasta import FastaFile
from delly_tpu.io.bam import BamFile, BamHeader, BamRecord, FLAGS

__all__ = [
    "bgzf_decompress",
    "bgzf_compress",
    "is_gzip",
    "FastaFile",
    "BamFile",
    "BamHeader",
    "BamRecord",
    "FLAGS",
]
