"""Model zoo: backbones, pose heads, LoRA adapters, registry/factory."""
