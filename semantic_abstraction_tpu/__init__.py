"""semantic_abstraction_tpu: TPU-native (JAX/XLA/Pallas) rebuild of Semantic Abstraction.

Open-world 3D scene understanding from 2D vision-language models
("Semantic Abstraction", Ha & Song, CoRL 2022), re-architected for TPU:

- multi-scale CLIP relevancy extraction as a single jitted forward+VJP with
  label gradients vmapped and tile pipelines batched (``clip/``)
- 3D semantic-abstracted completion networks (3D ResUNet + implicit decoder)
  as pure-function pytree models (``models/``)
- geometry / voxel-scatter / trilinear-sampling primitives as XLA-native ops
  (``ops/``)
- data-parallel training over a ``jax.sharding.Mesh`` (``parallel/``,
  ``runtime/``)

Reference behavior parity is tracked against real-stanford/semantic-abstraction
(cited per-module as ``file:line`` of the reference repo).
"""

__version__ = "0.1.0"
