from .checkpoint import SuperstepCheckpointer, truncate_lineage
from .superstep import SuperstepResult, superstep_fixpoint

__all__ = ["SuperstepCheckpointer", "truncate_lineage"]
