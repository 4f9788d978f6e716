"""Core tensor-train container and kernels."""
