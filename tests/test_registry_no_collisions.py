"""Registry hygiene: no two queriesN modules may register the same
name — a silent dict-merge overwrite drops an operator from the catalog
(caught live in round 4: token_length_histogram / crest_factor /
variogram were shadowed by later batches until renamed)."""

import glob
import importlib
import os


def test_no_duplicate_query_names_across_modules():
    root = os.path.join(os.path.dirname(__file__), "..")
    names: dict = {}
    for f in sorted(
        glob.glob(os.path.join(root, "signalsharp_ray/pipelines/queries*.py"))
    ):
        mod = os.path.basename(f)[:-3]
        if mod == "queries":
            continue  # the aggregator defines its own entries
        num = mod.replace("queries", "")
        m = importlib.import_module(f"signalsharp_ray.pipelines.{mod}")
        d = getattr(m, f"QUERIES{num}", None)
        if d is None:
            continue
        for k in d:
            names.setdefault(k, []).append(mod)
    dups = {k: v for k, v in names.items() if len(v) > 1}
    assert not dups, f"duplicate registry names across modules: {dups}"


def test_every_oracle_has_a_query():
    import __ray_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    orphans = [k for k in o if k not in q]
    assert not orphans, f"oracles without queries: {orphans}"
