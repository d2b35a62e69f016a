"""geocoding_toolbox_ray — a Ray-Data-native geocoding + spatial-join engine.

A from-scratch re-expression of the capabilities of agrc/geocoding-toolbox
(reference at /root/reference, v4.2.0) as streaming ``ray.data.Dataset``
pipelines:

* the reference's client-observable semantics — address cleansing
  (``geocode.py:40-62``), the fixed 11-column output row
  (``geocode.py:33-36``), accept-score thresholding, error rows, fail-fast
  health probe, run counters — reproduced as vectorized Arrow batch
  transforms; and
* the server side the reference delegates to the AGRC web API
  (standardization, candidate scoring, locator matching) internalized as a
  local, offline matcher: an address grammar, a broadcast cell-indexed
  reference table, point-in-polygon parcel joins and kNN cell-ring
  fallback.

No HTTP, no rate limiting (``geocode.py:31,195`` deliberately dropped):
matching is a local hash-probe + scored join inside actor-pool
``map_batches`` stages.
"""

__version__ = "0.1.0"
