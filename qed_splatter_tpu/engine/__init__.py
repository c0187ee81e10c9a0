"""Training engine: optimizers, densification, train step, trainer loop."""
