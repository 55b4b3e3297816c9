"""Host byte-domain container layer: frame headers, file header, ECC."""

from . import ecc, head
from .asfh import ASFH, COMPLETE, FORCE_FLUSH, INCOMPLETE

__all__ = ["ASFH", "COMPLETE", "FORCE_FLUSH", "INCOMPLETE", "ecc", "head"]
