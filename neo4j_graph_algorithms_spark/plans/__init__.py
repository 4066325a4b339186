from .checkpoint import SuperstepCheckpointer, truncate_lineage

__all__ = ["SuperstepCheckpointer", "truncate_lineage"]
