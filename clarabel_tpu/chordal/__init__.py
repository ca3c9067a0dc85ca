from .decomp import ChordalInfo, try_chordal_info

__all__ = ["ChordalInfo", "try_chordal_info"]
