"""commonscenes_tpu — a TPU-native (JAX/XLA/Pallas) re-implementation of the
CommonScenes capability set (scene-graph-conditioned 3D indoor scene
generation + manipulation, NeurIPS 2023).

This is NOT a port of the PyTorch reference (ymxlzgy/commonscenes); it is a
ground-up JAX framework designed for TPU hardware:

* static-shape padded scene graphs (`core.graph.GraphBatch`) instead of the
  reference's ragged flattened-graph collate (reference:
  dataset/threedfront_dataset.py:693-828),
* triplet-GCN message passing with `segment_sum` instead of torch
  `scatter_add` (reference: model/graph.py:124-211),
* the SDFusion-style latent-diffusion shape branch as jitted XLA programs
  with the DDIM loop as a `lax.scan` (reference:
  model/sdfusion_txt2shape_model.py, samplers/ddim.py),
* NDHWC 3D convs in bfloat16 on the MXU,
* data-parallel scaling via `jax.sharding.Mesh` + collectives over ICI
  (replacing the reference's dormant DDP path, model/diff_utils/distributed.py),
* Pallas kernels for the pairwise point-distance evaluation ops that the
  reference implements in CUDA (extension/chamfer.cu,
  scripts/pytorch_structural_losses/).
"""

__version__ = "0.1.0"
