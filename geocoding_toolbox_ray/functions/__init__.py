"""Scalar / vectorized functions.

Each module exposes the vectorized kernel (pyarrow.compute / numpy) used
inside ``map_batches`` AND a ``*_sql(expr)`` builder that renders the exact
same computation as an ANSI-SQL (DuckDB) expression.  The oracle SQL in
``__ray_entry__.oracle_sql()`` is generated from the same tables of
constants as the kernels, so Ray-vs-DuckDB parity is mechanical, not
hand-maintained.
"""
