from . import densify, optimizer, statistics, trainer
from .trainer import CameraBatch, Trainer, TrainState

__all__ = ["densify", "optimizer", "statistics", "trainer",
           "CameraBatch", "Trainer", "TrainState"]
