"""Pallas TPU kernel tier: SpMM / SDDMM / fused edge-softmax."""
