"""deepsphere_weather_tpu: TPU-native spherical weather-forecasting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
deepsphere/deepsphere-weather (PyTorch/CUDA reference): autoregressive global
weather forecasting with Chebyshev graph convolutions on spherical samplings,
trained on ERA5-like zarr stores, with probabilistic forecasting (SWAG /
DeepEnsembles), verification, and plotting.

Subpackages
-----------
sphere    geometry: samplings, knn graphs, Laplacians, conservative remap
ops       TPU compute kernels: Chebyshev conv (dense/ELL/Pallas), pooling
models    flax model architectures (UNetSpherical, ...)
data      chunked zarr-compatible store, AR dataset/loader, scalers
engine    AR training / prediction engines (lax.scan rollouts)
prob      SWAG + DeepEnsemble probabilistic layer
verif     deterministic verification metrics + benchmarks
parallel  device meshes, sharding, data/member parallelism
config    config system, experiment management
plotting  skill maps, training curves, forecast animations
native    C++ acceleration for setup-time geometry
"""

__version__ = "0.1.0"
