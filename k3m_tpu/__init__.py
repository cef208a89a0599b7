"""k3m_tpu — TPU-native JAX/Flax/Pallas rebuild of the K3M multimodal pretraining stack.

K3M ("Knowledge-perceived Multi-Modal pretraining", ACM MM 2021) models three
modalities per e-commerce product — title text (t), product image as RoI
features (v), and the product knowledge graph serialized as property:value
pairs (pv) — with a tri-stream co-attention encoder, four pretraining losses
(MLM, masked-RoI, 3-way alignment, TransE link prediction), and an
item-alignment finetune head.

This package is a from-scratch TPU-first implementation with the same
capabilities as the reference (sunzeyeah/K3M): jax/XLA for the compute path,
GSPMD sharding over device meshes for scale-out, Pallas kernels for the hot
attention ops, and a Grain/ArrayRecord data pipeline replacing
tensorpack/LMDB/ZeroMQ.

Reference parity map (file:line cites into the reference repo):
  - model:    vilbert_k3m/vilbert_k3m.py        -> k3m_tpu.model
  - data:     vilbert_k3m/datasets/*, data_prepare.py -> k3m_tpu.data
  - vision:   py-bottom-up-attention Faster R-CNN -> k3m_tpu.vision
  - training: train_concap_struc.py / pretrain.py -> k3m_tpu.train
  - finetune: finetune.py                        -> k3m_tpu.train.alignment_loop
"""

__version__ = "0.1.0"

from k3m_tpu.config import K3MConfig  # noqa: F401
