"""Stub of openpifpaf.decoder: the module-level configure hook run_pifpaf
forwards decoder CLI flags through (reference predict.py:150)."""

CONFIGURE_CALLS = []


def reset():
    CONFIGURE_CALLS.clear()


def configure(args):
    if getattr(args, 'stub_raise_on_configure', False):
        raise AttributeError('stub: incomplete args namespace')
    CONFIGURE_CALLS.append(args)
