"""Placeholder — implemented later this round."""

def mann_whitney_utest(*a, **k):
    raise NotImplementedError
