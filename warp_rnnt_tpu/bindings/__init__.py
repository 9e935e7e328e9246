"""Framework front-ends (reference API parity for PyTorch users)."""
