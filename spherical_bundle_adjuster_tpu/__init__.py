"""spherical_bundle_adjuster_tpu: a TPU-native spherical (360/ERP)
structure-from-motion and bundle adjustment framework.

Re-designed from scratch for JAX/XLA/Pallas/pjit with the capabilities of
the reference C++ tool whdlgp/spherical_bundle_adjuster: ERP<->cubemap
reprojection, distortion-reduced spherical feature front-ends, descriptor
matching, robust two-view relative pose (8-point RANSAC consensus + BA),
and — beyond the reference — batched multi-pair and distributed
multi-keyframe Schur-complement bundle adjustment over TPU meshes.
"""

__version__ = "0.1.0"

from .utils.config import PipelineConfig  # noqa: F401
