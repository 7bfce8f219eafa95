"""geoutils_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Capabilities mirror nickblock/geoutils (reference snapshot at /root/reference/,
see SURVEY.md): hierarchical cell indexing (S2-style, /root/reference/s2util/s2util.h:38-92),
spatial tile assignment (/root/reference/osms2split/src/s2splitter.cpp:91-135),
skew-aware balanced partitioning (/root/reference/osmsplit/mapsplit.h:65-88),
coordinate math (/root/reference/osm2assimp/eigenconversion.cpp), plus the
web-scale text/dedup/similarity operators a Common-Crawl-style pipeline needs.

Architecture is Spark-first: DataFrame/Catalyst column expressions on the hot
path, Arrow-batched pandas UDFs where built-ins can't express the semantics,
no per-row Python anywhere.
"""

__version__ = "0.1.0"
