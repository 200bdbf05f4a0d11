"""StreamMOS-TPU: a TPU-native streaming moving-object-segmentation engine.

A ground-up JAX/XLA/Pallas re-design of the capabilities of StreamMOS
(MinChoi0129/StreamMOS, RA-L 2025, arXiv:2407.17905): per-point encoding,
scatter-based voxel max-pooling, a cascaded BEV/range-view multi-view encoder
with asymmetric convolutions, deformable-attention temporal fusion against a
short-term feature memory, a parameter-free upsampling decoder, two-stage
training (MOS + movable-segmentation refine), and long-term-memory voxel /
instance voting refinement.

Everything on the compute path is expressed as jit-compilable JAX: static
shapes, functional state, scatter/gather kernels formulated for the TPU memory
system, and data parallelism via `jax.sharding` meshes.
"""

__version__ = "0.1.0"
