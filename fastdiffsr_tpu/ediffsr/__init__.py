"""EDiffSR sub-framework (TPU-native): IR-SDE training/eval of
ConditionalNAFNet — the rebuild of FastDiffSR/EDiffSR (reference
EDiffSR/codes/config/sisr/{train,test}.py)."""

from .options import parse_options

__all__ = ["parse_options"]
