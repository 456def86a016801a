from .train import train_detector, set_random_seed
from .test import run_inference, results_to_host

__all__ = ["train_detector", "set_random_seed", "run_inference",
           "results_to_host"]
