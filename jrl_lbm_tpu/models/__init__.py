"""Scene/workload layer: shear layer, cylinder channel, JRL tip approach."""

from jrl_lbm_tpu.models import cylinder, jrl, shear_layer

__all__ = ["cylinder", "jrl", "shear_layer"]
