from .pfdr_quadratic import (PFDROptions, PFDRResult, VertexProx,
                             pfdr_quadratic_d1)

__all__ = ["PFDROptions", "PFDRResult", "VertexProx", "pfdr_quadratic_d1"]
