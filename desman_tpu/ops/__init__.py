"""Pallas TPU kernels for the sampler hot path."""

from .tau_pallas import tau_sweep_pallas

__all__ = ["tau_sweep_pallas"]
