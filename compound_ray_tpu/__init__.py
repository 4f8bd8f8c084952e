"""CompoundRay-TPU: a TPU-native compound-eye (insect vision) renderer.

A ground-up re-design of the capabilities of CompoundRay
(reference: optseb/compound-ray, OptiX 7/CUDA) for TPU hardware using
JAX/XLA/Pallas.  The OptiX BVH + per-thread SIMT ray launch is replaced by a
cone-coherent cluster-culled wavefront tracer: scenes compile to flat
world-space triangle arrays, triangles are grouped into cache-sized clusters
(host-side builder), each ommatidium's acceptance cone culls clusters once
per frame (amortised over all of its samples), and a fused
generate-trace-shade-accumulate kernel produces per-ommatidium mean radiance
with O(ommatidia) memory.  Ommatidia shard across a `jax.sharding.Mesh`.

Public surface mirrors the reference's C ABI (libEyeRenderer3/libEyeRenderer.h)
via :mod:`compound_ray_tpu.api`.
"""

__version__ = "0.1.0"

# Geometry in a renderer is f32: the TPU MXU's DEFAULT one-pass bf16 matmul
# gives ~4e-3 relative error, which flips Voronoi projection winners
# (measured 11.5/255 MAE vs CPU on the ofstad stripe band), perturbs camera
# ray directions, and can flip borderline cull decisions.  Rather than
# mutating the process-wide jax_default_matmul_precision (which would also
# slow down unrelated user models sharing the process), every matmul /
# contracting einsum in this package passes precision=HIGHEST explicitly
# (trace/, eye/, accel/, cameras/, projection/).  The reference hardware
# (OptiX/CUDA) always computes geometry in f32.

from compound_ray_tpu.api.renderer import EyeRenderer  # noqa: F401
