"""recformer_tpu: a TPU-native (JAX / XLA / Pallas) framework with the
capabilities of the RecFormer reference (text-based sequential recommendation:
Longformer-style encoder over flattened item-attribute sequences, MLM +
item-item contrastive pretraining, two-stage seq-rec finetuning, fraud
classification, clustering analytics)."""

from .config import RecformerConfig
from .models.recformer import RecformerModel
from .models.heads import (
    RecformerForPretraining,
    RecformerForSeqRec,
    RecformerForFraudDetection,
    cosine_similarity,
    similarity_scores,
)
from .data.tokenization import RecformerTokenizer

__version__ = "0.1.0"

__all__ = [
    "RecformerConfig",
    "RecformerModel",
    "RecformerForPretraining",
    "RecformerForSeqRec",
    "RecformerForFraudDetection",
    "RecformerTokenizer",
    "cosine_similarity",
    "similarity_scores",
]
