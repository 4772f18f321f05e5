__version__ = "0.1.0"

# Version string used in VCF SVMETHOD INFO field (parity with the reference's
# EMBL.DELLYv<version>, src/modvcf.h:503-505).
SVMETHOD = "EMBL.DELLYv" + "2.5.1"

# Package version (delly-tpu release)
VERSION = "0.1.0"
