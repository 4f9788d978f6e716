"""Transport samplers, debiasing and diagnostics."""
