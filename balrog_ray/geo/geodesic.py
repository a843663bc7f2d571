"""Geodesic helpers + the engine's CRS contract.

CRS contract: every planar operator in this package (geometry.py,
boolean.py, the spatial joins, zonal stats) assumes coordinates in a
PROJECTED metre CRS (the synthetic world uses a local transverse-Mercator
analogue, EPSG:28350-style).  The reference instead stores degree-CRS data
(EPSG:4283) and pays per-row geodesic math -- ``st_buffer(geography)``
(``data_prep/gnaf/create_buffered_points.sql:2-13``), ``pyproj.Geod.inv``
azimuth/distance (``xx_fiona_testing.py:205-228``), and gdaldem's
``-s 111120`` degree-to-metre scale (``03_create_dem_aspect_slope_
rasters.sh:26-28``).  This module supplies that degree-CRS path:

* :func:`haversine_m` / :func:`sphere_azimuth_deg` -- great-circle
  distance / forward azimuth on the mean sphere (|error| < 0.6% vs the
  WGS84 ellipsoid, fine for 100 m-class buffer analysis);
* :func:`geodesic_point_buffer` -- the project->buffer->unproject pattern
  of ``xx_fiona_testing.py:222-228``: an azimuthal-equidistant local
  frame around the point, a regular n-gon at the exact radius, unprojected
  back to lon/lat;
* :func:`local_meter_frame` -- per-batch lon/lat -> local metre
  coordinates so the planar kit can run on degree-CRS inputs.
"""

from __future__ import annotations

import numpy as np

from .geometry import Polygon

EARTH_R = 6371008.8          # IUGG mean radius, metres
_RAD = np.pi / 180.0


def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Great-circle distance in metres (vectorized)."""
    lon1, lat1, lon2, lat2 = (np.asarray(v, dtype=np.float64) * _RAD
                              for v in (lon1, lat1, lon2, lat2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = (np.sin(dlat / 2) ** 2
         + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2) ** 2)
    return 2 * EARTH_R * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


def sphere_azimuth_deg(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Initial great-circle bearing (degrees clockwise from north)."""
    lon1, lat1, lon2, lat2 = (np.asarray(v, dtype=np.float64) * _RAD
                              for v in (lon1, lat1, lon2, lat2))
    dlon = lon2 - lon1
    y = np.sin(dlon) * np.cos(lat2)
    x = (np.cos(lat1) * np.sin(lat2)
         - np.sin(lat1) * np.cos(lat2) * np.cos(dlon))
    return np.mod(np.degrees(np.arctan2(y, x)), 360.0)


def _destination(lon, lat, bearing_deg, dist_m):
    """Direct geodesic problem on the sphere (vectorized)."""
    lat1 = np.asarray(lat, dtype=np.float64) * _RAD
    lon1 = np.asarray(lon, dtype=np.float64) * _RAD
    brg = np.asarray(bearing_deg, dtype=np.float64) * _RAD
    dr = np.asarray(dist_m, dtype=np.float64) / EARTH_R
    lat2 = np.arcsin(np.sin(lat1) * np.cos(dr)
                     + np.cos(lat1) * np.sin(dr) * np.cos(brg))
    lon2 = lon1 + np.arctan2(np.sin(brg) * np.sin(dr) * np.cos(lat1),
                             np.cos(dr) - np.sin(lat1) * np.sin(lat2))
    return np.degrees(lon2), np.degrees(lat2)


def geodesic_point_buffer(lon: float, lat: float, radius_m: float,
                          n_seg: int = 32) -> Polygon:
    """Circular buffer around a lon/lat point, returned as a lon/lat-ring
    Polygon: every vertex sits exactly ``radius_m`` great-circle metres
    from the centre (the ``st_buffer(geography)`` /
    project->buffer->unproject analogue)."""
    bearings = np.linspace(0.0, 360.0, n_seg, endpoint=False)
    lons, lats = _destination(lon, lat, bearings, radius_m)
    return Polygon(np.column_stack([lons, lats]))


def spherical_ring_area_m2(ring: np.ndarray) -> float:
    """Signed spherical area (m^2) of a closed lon/lat ring (degrees) on
    the mean sphere, via the line-integral form of the spherical excess
    (Chamberlain & Duquette 2007, eq. 15 -- the ``st_area(geography)`` /
    ``pyproj.Geod.geometry_area_perimeter`` role the reference uses at
    ``data_prep/vegetation/04_merge_geometries.py:188``): ``A = -R^2/2 *
    sum((lam_{i+1} - lam_i) * (sin(phi_i) + sin(phi_{i+1})))``.  Positive
    for counter-clockwise rings; lon steps are wrapped to (-180, 180] so
    antimeridian-crossing rings stay local."""
    ring = np.asarray(ring, np.float64)
    lon = np.deg2rad(ring[:, 0])
    lat = np.deg2rad(ring[:, 1])
    dlon = np.diff(lon)
    dlon = (dlon + np.pi) % (2.0 * np.pi) - np.pi
    a = -(dlon * (np.sin(lat[:-1]) + np.sin(lat[1:]))).sum() / 2.0
    return float(a * EARTH_R * EARTH_R)


def spherical_polygon_area_m2(poly: Polygon) -> float:
    """Geodesic (mean-sphere) area of a lon/lat Polygon, holes
    subtracted -- |error| < 0.3% vs the WGS84 ellipsoid at mid
    latitudes, the same tolerance class as :func:`haversine_m`."""
    a = abs(spherical_ring_area_m2(poly.exterior))
    return a - sum(abs(spherical_ring_area_m2(h)) for h in poly.holes)


def local_meter_frame(lons, lats, lon0: float, lat0: float) -> np.ndarray:
    """Project lon/lat to a local azimuthal-equidistant-ish metre frame
    centred on (lon0, lat0): x = east metres, y = north metres.  Accurate
    to <0.1% within ~100 km of the centre -- run the planar kit on the
    result, as the reference does with its per-site UTM projection
    (``xx_fiona_testing.py:222-228``)."""
    lons = np.asarray(lons, dtype=np.float64)
    lats = np.asarray(lats, dtype=np.float64)
    x = (lons - lon0) * _RAD * EARTH_R * np.cos(lat0 * _RAD)
    y = (lats - lat0) * _RAD * EARTH_R
    return np.column_stack([x, y])
