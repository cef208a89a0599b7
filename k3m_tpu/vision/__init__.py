"""JAX Faster R-CNN (bottom-up-attention R101-C4) for RoI feature extraction.

Replaces the reference's py-bottom-up-attention detectron2 fork (C++/CUDA
RoIPool/NMS ops; driven from 2_generate_tsv_ali.py:82-175 and
data_prepare.py:183-277) with a pure JAX/XLA implementation: Flax
ResNet-101-C4 backbone with frozen BN, RPN with fixed-shape proposal
selection, RoIPool/RoIAlign as gather+bilinear compositions, and NMS as a
fixed-iteration masked suppression loop — all static shapes, all on TPU.
"""

from k3m_tpu.vision.frcnn import FasterRCNN, extract_rois, make_extractor  # noqa: F401
