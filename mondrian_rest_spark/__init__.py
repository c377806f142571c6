"""mondrian_rest_spark — a PySpark-native OLAP analytics engine.

A from-scratch re-expression of the query capabilities of
jazzido/mondrian-rest (reference: lib/mondrian_rest/*.rb) as idiomatic
Spark DataFrame plans over Parquet star schemas.  The reference compiles
REST parameters into MDX and delegates to the Mondrian ROLAP engine;
this package replaces that whole stack (MDX + Mondrian + JDBC) with a
declarative cube catalog and a Catalyst-optimized DataFrame planner.

Layout:
    catalog.py    -- cube/dimension/measure model (analog of the XML catalog)
    parser.py     -- member/cut/drilldown mini-parsers (analog of query_helper.rb parsing)
    query.py      -- validated QueryModel (analog of build_query inputs)
    planner.py    -- QueryModel -> DataFrame plan (the engine core)
    members.py    -- metadata surface (cubes/dimensions/levels/members)
    result.py     -- tidy rows + axes/cell_keys/values shaping
    formats.py    -- json / jsonrecords / csv sinks
    tpch.py       -- test catalog bound to the driver-generated star schema
    operators/    -- scale extensions: dedup, similarity, text stats, windows
    sources/      -- table registry / readers
"""

__version__ = "0.1.0"
