"""Driver-window certification discipline (VERDICT r3 items 1 & 7).

The correctness driver evaluates only the first ``DRIVER_WINDOW``
entries of ``queries()`` in dict order.  Round 3 lost 17 driver rows
because inserts silently pushed queries past that window.  These tests
make the discipline self-enforcing:

- everything past the window must be consciously allowlisted in
  ``_BEYOND_WINDOW_VETERANS`` (a deliberate edit, reviewed),
- every allowlisted veteran must actually hold a hash-green row in a
  committed CORRECTNESS artifact (it was certified before rotating out),
- every registered query keeps an oracle entry or a documented
  exemption.
"""

from __future__ import annotations

import glob
import json
import os
import re

import __spark_entry__ as entry

REPO = os.path.dirname(os.path.abspath(entry.__file__))


def _correctness_rows() -> dict[str, dict]:
    """name -> most recent committed CORRECTNESS row, newest round wins."""
    rows: dict[str, dict] = {}
    files = sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
    )
    for path in files:
        with open(path) as f:
            for name, row in json.load(f).items():
                rows[name] = row
    return rows


def test_registry_shape():
    names = list(entry.queries().keys())
    assert len(names) == len(set(names)), "duplicate query names"
    # oracle keys must be registered queries
    extra = set(entry.oracle_sql()) - set(names)
    assert not extra, f"oracle_sql keys without a query: {sorted(extra)}"


def test_beyond_window_is_allowlisted():
    names = list(entry.queries().keys())
    beyond = names[entry.DRIVER_WINDOW :]
    assert beyond == entry._BEYOND_WINDOW_VETERANS, (
        "queries past the driver window must exactly match "
        "_BEYOND_WINDOW_VETERANS (order included). If you added a query, "
        "insert it INSIDE the first DRIVER_WINDOW entries and rotate a "
        "certified veteran out explicitly.\n"
        f"beyond-window now: {beyond}"
    )


def test_beyond_window_veterans_were_certified():
    rows = _correctness_rows()
    missing = [
        n
        for n in entry._BEYOND_WINDOW_VETERANS
        if n not in rows or not rows[n].get("hash_match")
    ]
    assert not missing, (
        "veterans rotated past the driver window must hold a hash-green "
        f"row in a committed CORRECTNESS artifact; missing/red: {missing}"
    )


def test_window_covers_everything_not_allowlisted():
    names = list(entry.queries().keys())
    in_window = set(names[: entry.DRIVER_WINDOW])
    out = set(names) - in_window - set(entry._BEYOND_WINDOW_VETERANS)
    assert not out, f"uncertified queries outside the window: {sorted(out)}"
