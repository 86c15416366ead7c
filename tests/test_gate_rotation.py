"""Pin the gate-rotation tiling property (VERDICT r6 #8).

The driver's CORRECTNESS sweep records only the first 50 ``queries()``
entries; ``__spark_entry__._rotate_gates`` shifts the canonical order by
``step = len - 50`` per round so consecutive rounds' 50-row windows
together cover every gate.  That holds exactly when the per-round
shadow (the ``len - 50`` uncovered gates) is no larger than the window
shift — i.e. while ``len(gates) <= 100``.  Today's step tiles; these
tests FAIL the moment someone adds a gate that silently breaks the
two-round coverage contract, instead of a judge discovering a
permanently-shadowed gate two rounds later (r5's ``simhash_pairs``)."""

from __future__ import annotations

import __spark_entry__ as entry_mod
from invertedindexbuilder_spark.gates import CANONICAL_ORDER

WINDOW = 50  # driver budget: CORRECTNESS_r* files hold exactly 50 rows


def _window(names: list[str], rnd: int) -> set[str]:
    step = max(1, len(names) - WINDOW)
    off = (step * rnd) % len(names)
    rotated = names[off:] + names[:off]
    return set(rotated[:WINDOW])


def test_two_consecutive_rounds_cover_every_gate():
    names = CANONICAL_ORDER
    assert len(names) == len(set(names))
    # full offset cycle: offsets repeat with period len/gcd(step, len),
    # bounded by len — checking rounds 0..len covers every phase
    for rnd in range(len(names) + 1):
        covered = _window(names, rnd) | _window(names, rnd + 1)
        missed = set(names) - covered
        assert not missed, (
            f"gates shadowed in BOTH rounds {rnd} and {rnd + 1}: "
            f"{sorted(missed)} — the rotation no longer tiles "
            f"({len(names)} gates, step {max(1, len(names) - WINDOW)}); "
            "with more than 100 gates a 50-row window cannot cover "
            "everything in two rounds — shrink the gate list or extend "
            "the contract to three-round coverage first"
        )


def test_rotate_gates_matches_window_math(monkeypatch):
    """_rotate_gates IS the function the driver consumes — pin that its
    head-50 equals the window the tiling proof above reasons about."""
    d = {k: k for k in CANONICAL_ORDER}
    for rnd in (0, 1, 7, len(CANONICAL_ORDER)):
        monkeypatch.setattr(entry_mod, "_gate_round", lambda r=rnd: r)
        rotated = entry_mod._rotate_gates(d)
        assert list(rotated) != [] and set(rotated) == set(d)
        assert set(list(rotated)[:WINDOW]) == _window(CANONICAL_ORDER, rnd)


def _attested_gates() -> set[str]:
    """Gate names that already have a driver row in some committed
    CORRECTNESS_r*.json — these have debuted and need no further
    first-window guarantee."""
    import glob
    import json
    import os

    here = os.path.dirname(os.path.abspath(entry_mod.__file__))
    got: set[str] = set()
    for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        with open(p) as f:
            got |= set(json.load(f))
    return got


def test_debut_gates_land_in_their_first_window():
    """Canonical-last debuts must get a driver row in their debut round.

    VERDICT r7 #1a: the old form asserted against ``_gate_round()`` (=
    the NEXT round) unconditionally, so it went red the moment the
    driver dropped the round's CORRECTNESS file — the debut had already
    happened, but the window had moved on.  Only gates NOT yet attested
    in any committed CORRECTNESS_r*.json still owe a first-window slot."""
    names = CANONICAL_ORDER
    attested = _attested_gates()
    pending = [n for n in names if n not in attested]
    if not pending:
        return  # every gate has debuted; nothing left to owe a window
    nxt = entry_mod._gate_round()
    win = _window(names, nxt) | _window(names, nxt + 1)
    missed = set(pending) - win
    assert not missed, (
        f"unattested gates {sorted(missed)} miss BOTH round-{nxt} and "
        f"round-{nxt + 1} windows; new gates must debut inside the "
        "50-row driver window within two rounds"
    )


def test_debut_assertion_survives_driver_drop(tmp_path, monkeypatch):
    """Simulated driver drop (VERDICT r7 #1a done-criterion): after a
    CORRECTNESS_r99.json lands that attests every gate, the debut test's
    logic must stay green even though the window has rotated past the
    newest gate."""
    import json

    f = tmp_path / "CORRECTNESS_r99.json"
    f.write_text(json.dumps({n: {"hash_match": True} for n in CANONICAL_ORDER}))
    real_glob = __import__("glob").glob
    monkeypatch.setattr(
        "glob.glob",
        lambda pat: [str(f)] if "CORRECTNESS_r" in pat else real_glob(pat),
    )
    assert entry_mod._gate_round() == 100
    # all gates attested -> debut test has nothing pending, regardless
    # of where round 100's window sits
    attested = _attested_gates()
    assert set(CANONICAL_ORDER) <= attested
