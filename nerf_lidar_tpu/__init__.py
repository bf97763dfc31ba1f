"""nerf_lidar_tpu: a TPU-native (JAX/XLA/Pallas/pjit) LiDAR simulation framework.

Capabilities mirror fudan-zvg/NeRF-LiDAR (AAAI 2024): per-scene ZipNeRF-style
neural field training from multi-camera images + LiDAR depth + pseudo labels,
32-beam LiDAR sweep rendering (depth / semantics / RGB / intensity), and a
U-Net "ray-drop" network that turns rendered sweeps into realistic labeled
point clouds in SemanticKITTI format.

The design is TPU-first, not a port: pure-functional models over parameter
pytrees, a multi-resolution hash-grid encoder with a Pallas TPU kernel and a
deterministic (XLA scatter-add) backward, static-shape masked compositing for
dynamic objects, and data parallelism expressed as `jax.sharding` annotations
over an ICI mesh.
"""

__version__ = "0.1.0"
