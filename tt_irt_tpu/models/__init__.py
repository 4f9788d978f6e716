"""Benchmark model families: shock absorber, Lorenz, predator-prey,
inverse diffusion."""
