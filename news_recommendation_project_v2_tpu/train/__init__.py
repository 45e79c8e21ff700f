from .losses import infonce_loss, margin_ranking_loss
from .trainer import ClassificationTrainer, TowerTrainer

__all__ = [
    "ClassificationTrainer",
    "TowerTrainer",
    "infonce_loss",
    "margin_ranking_loss",
]
