"""Placeholder — implemented later this round."""

def group_set(*a, **k):
    raise NotImplementedError
