"""gparml_tpu — TPU-native sparse variational GPs and Bayesian GPLVM.

A ground-up JAX/XLA/Pallas re-design with the capabilities of markvdw/GParML
(see SURVEY.md): Titsias-collapsed sparse GP regression and Bayesian GPLVM,
data-parallel sufficient statistics over a TPU mesh, a fully jit'd SCG
optimizer, and a fused Pallas kernel for the psi-statistics hot loop.
"""

__version__ = "0.1.0"

from gparml_tpu import checkpoint, data
from gparml_tpu.models import gplvm, sgpr, svgp
from gparml_tpu.models import params
from gparml_tpu.opt import scg

__all__ = ["checkpoint", "data", "gplvm", "sgpr", "svgp", "params", "scg", "__version__"]
