"""Placeholder — implemented later this round."""

def matrix_multiplication(*a, **k):
    raise NotImplementedError
