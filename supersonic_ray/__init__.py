"""ray-sonic: a Ray-Data-native columnar encode/query engine.

A from-scratch re-creation of the capabilities of Google Supersonic
(reference at /root/reference, studied in SURVEY.md) built idiomatically
on ray.data.Dataset pipelines over zero-copy Arrow batches:

- ``codecs``     per-column lightweight compression (plain, dict, RLE,
                 frame-of-reference + bit-packing, FSST) with a
                 stats-driven auto-selector and optional general-purpose
                 backend wrap.  Pure numpy/pyarrow kernels, no Ray.
- ``pipelines``  the Ray Data encode/decode pipelines with per-partition
                 lineage manifests and checkpoint resume.
- ``functions``  the scalar expression library (arithmetic with the
                 reference's Signaling/Nulling/Quiet error policies,
                 string, date, regexp, hashing) as per-batch Arrow kernels.
- ``stages``     relational operators (filter/project/compute, grouped +
                 scalar aggregation incl. DISTINCT/CONCAT/FIRST/LAST,
                 broadcast hash join, semi/anti join, sort/top-k,
                 merge-union, dedup, stateful running expressions) plus
                 the training-data ops (minhash/simhash dedup, ANN,
                 text quality, multimodal stubs).
- ``state``      manifests and resume bookkeeping.

Nothing in this package calls ray.init(); sessions are owned by callers
(bench.py, tests/conftest.py, the driver).
"""

__version__ = "0.1.0"
