"""Inference drivers: batched reasoning inference, CATER-setup grid
classification, programmed-model tracking, perception preprocessing."""
