from .prox import (box_clamp, d1_pair_prox, proj_simplex_metric,
                   soft_threshold)
from .power_iter import operator_norm

__all__ = ["box_clamp", "d1_pair_prox", "proj_simplex_metric",
           "soft_threshold", "operator_norm"]
