# -*- coding: utf-8 -*-
"""``python -m george_tpu.native.build`` — compile the native library."""

from . import build, have_native

if __name__ == "__main__":
    path = build(verbose=True)
    print("built", path)
    assert have_native()
