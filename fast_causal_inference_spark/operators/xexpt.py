"""Placeholder — implemented later this round."""

def xexpt_ttest_2samp(*a, **k):
    raise NotImplementedError
