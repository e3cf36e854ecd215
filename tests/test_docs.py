# -*- coding: utf-8 -*-
"""The DSL-generated kernel reference must match the committed file.

Reference analog: docs/user/kernels.rst.template renders the YAML ``doc:``
blocks so code and docs cannot drift; here the drift check is this test.
Regenerate with ``python -m george_tpu.dsl.docgen``.
"""

import os

from george_tpu.dsl.docgen import render_kernel_docs, DEFAULT_PATH


def test_kernel_reference_is_current():
    assert os.path.exists(DEFAULT_PATH), (
        "docs/kernels_reference.md is missing; run "
        "`python -m george_tpu.dsl.docgen`"
    )
    with open(DEFAULT_PATH) as f:
        committed = f.read()
    assert committed == render_kernel_docs(), (
        "docs/kernels_reference.md is stale; regenerate with "
        "`python -m george_tpu.dsl.docgen`"
    )


def test_reference_covers_all_builtin_kernels():
    text = render_kernel_docs()
    from george_tpu.dsl.specs import load_specs

    specs = load_specs()
    assert len(specs) >= 13
    for name in specs:
        assert "## `{0}`".format(name) in text
