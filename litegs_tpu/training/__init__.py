from . import densify, optimizer, statistics, trainer
from .start import start
from .trainer import CameraBatch, Trainer, TrainState

__all__ = ["densify", "optimizer", "statistics", "trainer", "start",
           "CameraBatch", "Trainer", "TrainState"]
