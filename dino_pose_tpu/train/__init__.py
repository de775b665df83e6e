"""Training stack: losses, dynamic loss weighting, pjit train step, eval."""
