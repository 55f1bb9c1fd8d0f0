from .denormalized import DimSpec, DenormResult, write_denormalized

__all__ = ["DimSpec", "DenormResult", "write_denormalized"]
