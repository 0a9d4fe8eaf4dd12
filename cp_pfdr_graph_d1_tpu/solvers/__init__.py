from .pfdr_quadratic import (PFDROptions, PFDRResult, VertexProx,
                             pfdr_quadratic_d1)
from .pfdr_simplex import SimplexResult, pfdr_loss_d1_simplex

__all__ = ["PFDROptions", "PFDRResult", "VertexProx", "pfdr_quadratic_d1",
           "SimplexResult", "pfdr_loss_d1_simplex"]
