"""TPU-native VQA transfer-learning framework.

A from-scratch JAX / XLA / Pallas rebuild of the capabilities of
``HyeonwooNoh/VQA-Transfer-ExternalData`` (CVPR'19: "Transfer Learning via
Unsupervised Task Discovery for Visual Question Answering"):

- Stage 1 ("vlmap"): task-conditional visual classifiers pretrained on Visual
  Genome region descriptions, with unsupervised visual-word task discovery.
- Stage 2 ("vqa"): a VQA v2 model (GloVe+GRU question encoder, single-glimpse
  spatial attention over a 14x14x2048 ResNet-101 feature grid, answer
  classifier initialized from the pretrained answer-embedding space).

Design blueprint: ``SURVEY.md`` (reference mount was empty; spec authority is
``BASELINE.json``). All compute paths are jit-compiled for TPU; hot kernels
are Pallas; multi-chip scaling is a ``jax.sharding.Mesh`` data-parallel
trainer shared by both stages (reference: single-GPU TF1, SURVEY.md section 2).
"""

__version__ = "0.1.0"
