"""Driver-contract consistency: queries() and oracle_sql() must stay in
lockstep, and every callable must be importable and well-formed."""

import __spark_entry__ as entry


class TestEntryContract:
    def test_every_oracle_has_a_query(self):
        qs, oracles = entry.queries(), entry.oracle_sql()
        dangling = set(oracles) - set(qs)
        assert not dangling, f"oracles without queries: {sorted(dangling)}"

    def test_rows_only_queries_are_documented(self):
        """Queries without an oracle must say why in their docstring."""
        qs, oracles = entry.queries(), entry.oracle_sql()
        missing = []
        for name, fn in qs.items():
            if name in oracles:
                continue
            doc = (fn.__doc__ or "").lower()
            if not any(k in doc for k in ("rows-only", "no sql oracle",
                                          "composite")):
                missing.append(name)
        assert not missing, \
            f"rows-only queries lacking a rationale docstring: {missing}"

    def test_all_queries_callable_with_two_args(self):
        import inspect
        for name, fn in entry.queries().items():
            params = [p for p in inspect.signature(fn).parameters.values()
                      if p.default is inspect.Parameter.empty]
            assert len(params) == 2, f"{name} must take (spark, sf_dir)"

    def test_oracle_sql_is_nonempty_text(self):
        for name, sql in entry.oracle_sql().items():
            assert isinstance(sql, str) and len(sql.strip()) > 10, name

    def test_entry_exists(self):
        assert callable(entry.entry)

    def test_window_matches_mechanical_rule(self):
        """The in-code round-16 window must equal the mechanical
        recency rotation computed from the r1-r15 driver records
        (verdict r12 item 3: a pinned --round keeps this check green
        in-tree even after the fresh r16 driver record lands)."""
        import sys
        from pathlib import Path
        sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))
        try:
            from gen_window import compute_window, WINDOW_SIZE
        finally:
            sys.path.pop(0)
        computed = compute_window(for_round=16)
        in_code = list(entry.queries())[:WINDOW_SIZE]
        assert computed == in_code
