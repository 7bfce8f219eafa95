"""Tag-derived projections: height, name, kind, closed-way predicate.

Pure Catalyst column expressions re-deriving the reference's OSMFeature
projections (/root/reference/osm2assimp/osmfeature.cpp):

* height  — F8: ``coalesce(float(tags['height']), levels*2.5, 3*2.5)`` with
  bad-parse fallback (osmfeature.cpp:23-51; constants :16-18).
* name    — F9: first fully-present priority list of
  {name}, {addr:housename}, {addr:housenumber + addr:street}, else the way id
  (osmfeature.cpp:20-21, 53-86).
* kind    — F10: building > highway > waterway precedence (osmfeature.cpp:88-104).
* closed  — P7: >3 refs and first == last (osmfeature.cpp:105-108).
* keys-of-interest filter — P5 (/root/reference/osms2split/src/s2splitter.cpp:76-89).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

METRES_PER_LEVEL = 2.5  # osmfeature.cpp:16
DEFAULT_LEVELS = 3      # osmfeature.cpp:17-18


def height_col(tags: Column, default_m: float | None = None) -> Column:
    """try_cast mirrors the reference's atof-with-fallback (bad parse -> next
    rule, osmfeature.cpp:27-49). ``default_m`` is the reference's ``-f``
    fixed-height flag (main.cpp:81-83): the fallback used when neither
    ``height`` nor ``building:levels`` parses; ``None`` keeps the built-in
    3-level x 2.5 m cascade default (osmfeature.cpp:16-18)."""
    if default_m is None:
        default_m = DEFAULT_LEVELS * METRES_PER_LEVEL
    return F.coalesce(
        F.try_element_at(tags, F.lit("height")).try_cast("double"),
        F.try_element_at(tags, F.lit("building:levels")).try_cast("double")
        * F.lit(METRES_PER_LEVEL),
        F.lit(float(default_m)),
    )


def name_col(tags: Column, way_id: Column) -> Column:
    housenumber_street = F.when(
        F.try_element_at(tags, F.lit("addr:housenumber")).isNotNull()
        & F.try_element_at(tags, F.lit("addr:street")).isNotNull(),
        F.concat_ws(
            " ",
            F.try_element_at(tags, F.lit("addr:housenumber")),
            F.try_element_at(tags, F.lit("addr:street")),
        ),
    )
    return F.coalesce(
        F.try_element_at(tags, F.lit("name")),
        F.try_element_at(tags, F.lit("addr:housename")),
        housenumber_street,
        way_id.cast("string"),
    )


def kind_col(tags: Column) -> Column:
    return (
        F.when(F.try_element_at(tags, F.lit("building")).isNotNull(), F.lit("building"))
        .when(F.try_element_at(tags, F.lit("highway")).isNotNull(), F.lit("highway"))
        .when(F.try_element_at(tags, F.lit("waterway")).isNotNull(), F.lit("water"))
        .otherwise(F.lit("other"))
    )


def closed_way_col(refs: Column) -> Column:
    return (F.size(refs) > 3) & (
        F.element_at(refs, 1) == F.element_at(refs, -1)
    )


def has_keys_of_interest_col(tags: Column, keys: list[str]) -> Column:
    """P5: keep a way iff it carries at least one key of interest."""
    pred = F.lit(False)
    for k in keys:
        pred = pred | F.try_element_at(tags, F.lit(k)).isNotNull()
    return pred


def valid_feature_col(kind: Column, n_pts: Column, closed: Column) -> Column:
    """P6 validity: highways need >=2 points; buildings must be closed
    (osmfeature.cpp:160-166)."""
    return ((kind != "highway") | (n_pts >= 2)) & ((kind != "building") | closed)
