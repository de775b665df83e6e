"""Checkpoint IO: Orbax-native checkpoints and the PyTorch .pth bridge."""
