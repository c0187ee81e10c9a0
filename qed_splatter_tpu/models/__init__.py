"""Model layer: gaussian state, splat model, camera optimizer, bilateral grid."""
