"""Placeholder — implemented later this round."""

def boot_strap(*a, **k):
    raise NotImplementedError


def permutation(*a, **k):
    raise NotImplementedError
