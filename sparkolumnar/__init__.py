"""sparkolumnar — a PySpark-native per-column lightweight-compression engine.

A from-scratch re-creation of the capabilities of loro-dev/columnar
(`serde_columnar`, Rust) on Spark: per-column codecs (RLE / DeltaRle /
BoolRle / DeltaOfDelta, byte-compatible with the reference wire format,
plus dictionary, bit-packing, frame-of-reference and FSST extensions),
a statistics-driven codec auto-selector, and a distributed encode /
decode pipeline built on vectorized Arrow UDFs (`mapInArrow` /
`applyInPandas`) with per-partition lineage and exactly-once resume.

Reference behavior studied at /root/reference (loro-dev/columnar
v0.3.12); all code here is written from scratch against the public
Spark / Arrow / numpy APIs.
"""

__version__ = "0.1.0"
