"""delly-tpu: a TPU-native structural variant and copy-number variant caller.

A from-scratch reimplementation of the capabilities of dellytools/delly
(reference: /root/reference, v2.5.1) designed TPU-first:

- Host plane (Python + C++): BAM/CRAM-free from-scratch BGZF/BAM/FASTA/VCF
  codecs, CIGAR junction extraction, clique clustering, record plumbing.
- Compute plane (JAX/XLA/Pallas): batched banded edit-distance (Myers role),
  batched affine-gap Gotoh DP, profile MSA, GL/CNL likelihood math,
  read-depth/GC histogram reductions.
- Scale plane (jax.sharding / shard_map): chromosome-interval sharding with
  halo exchange, psum/all_gather for tallies and candidate merging.
"""

from delly_tpu.version import __version__

__all__ = ["__version__"]
