# -*- coding: utf-8 -*-
"""Persistent accuracy ledger for the on-chip smoke suite.

Every measured f32 delta is recorded here and flushed to
``tests_tpu/ledger.json`` at session end, so the accuracy record survives
the run (the printed deltas alone vanish with the terminal).
"""

import json
import os
import time

LEDGER = {}


def record(name, delta):
    LEDGER[name] = float(delta)


def flush(extra=None):
    if not LEDGER:
        return
    path = os.path.join(os.path.dirname(__file__), "ledger.json")
    # Merge into the committed record: a partial run (one test selected,
    # or some tests skipped under chip contention) must not drop the
    # other entries' deltas.
    deltas = {}
    try:
        with open(path) as f:
            deltas = dict(json.load(f).get("deltas", {}))
    except (OSError, ValueError):
        pass
    deltas.update(LEDGER)
    payload = {
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "deltas": dict(sorted(deltas.items())),
    }
    if extra:
        payload.update(extra)
    with open(path, "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True)
        f.write("\n")
