"""Training subsystem: dataset preparation, feature extraction, checkpoints.

The reference ships only a broken copy of upstream RVC's trainset
preprocessor (reference src/trainset_preprocess_pipeline_print.py — its
`slicer2` import does not exist in the repo, :14); this package provides a
working equivalent plus the pieces the reference never had: feature
extraction into training batches and TrainState checkpointing that
round-trips into the inference loader.
"""

from .dataset import Slicer, preprocess_trainset, extract_features, make_batches  # noqa: F401
from .checkpoint import (  # noqa: F401
    save_rvc_pth,
    save_train_state,
    load_train_state,
)
