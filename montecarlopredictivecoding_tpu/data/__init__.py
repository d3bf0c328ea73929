from .mnist import Batches, get_mnist_data, load_mnist_arrays
from .synthetic import chunk_dataset, grating_dataset, noise_dataset

__all__ = [
    "Batches",
    "get_mnist_data",
    "load_mnist_arrays",
    "chunk_dataset",
    "grating_dataset",
    "noise_dataset",
]
