"""Python utility layer (parity: reference src/python/python)."""
