"""Driver-contract invariants: the catalog shape the grader relies on."""

import inspect

from knowledgegraphs_ray.pipelines import catalog


def test_oracles_subset_of_queries():
    qs, osql = catalog.queries(), catalog.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(osql) >= 30  # don't silently lose oracle coverage


def test_query_callables_take_sf_dir():
    for name, fn in catalog.queries().items():
        params = [
            p
            for p in inspect.signature(fn).parameters.values()
            if p.default is inspect.Parameter.empty
        ]
        assert len(params) == 1, f"{name} must take exactly sf_dir"


def test_oracle_sql_is_nonempty_text():
    for name, sql in catalog.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_no_module_level_ray_init():
    import ast
    import pathlib

    tree = ast.parse(pathlib.Path("__ray_entry__.py").read_text())
    calls = [
        n
        for n in ast.walk(tree)
        if isinstance(n, ast.Call)
        and isinstance(n.func, ast.Attribute)
        and n.func.attr in ("init", "shutdown")
        and isinstance(n.func.value, ast.Name)
        and n.func.value.id == "ray"
    ]
    assert not calls  # the driver owns the session (docstrings may mention it)
