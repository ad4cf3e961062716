"""Model zoo registry (reference flexynesis/models/__init__.py surface)."""

from .base import BaseModel
from .crossmodal_pred import CrossModalPred
from .direct_pred import DirectPred
from .gnn import GNN
from .supervised_vae import SupervisedVAE
from .triplet_encoder import MultiTripletNetwork

# name used by --model_class and inference-time reconstruction
MODEL_REGISTRY = {
    "DirectPred": DirectPred,
    "supervised_vae": SupervisedVAE,
    "MultiTripletNetwork": MultiTripletNetwork,
    "CrossModalPred": CrossModalPred,
    "GNN": GNN,
}

__all__ = [
    "BaseModel",
    "DirectPred",
    "SupervisedVAE",
    "MultiTripletNetwork",
    "CrossModalPred",
    "GNN",
    "MODEL_REGISTRY",
]
