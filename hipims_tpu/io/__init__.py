"""Dataset I/O: rasters (ASC / GeoTIFF / HFA), CSV timeseries, XML config.

The reference wraps GDAL (src/Datasets/CRasterDataset.cpp); this package
implements the needed codecs natively so the framework has no GDAL
dependency.  Grid convention: ``Raster.data`` is in map orientation (row 0 =
north); domain arrays are south-up (row 0 = south, matching the reference's
bottom-up scanline flip in applyDataToDomain, CRasterDataset.cpp:~375-425)
— use Raster.to_domain_array / from_domain_array to convert.
"""

from .raster import Raster, read_raster, write_raster  # noqa: F401
from .csv_series import read_timeseries_csv  # noqa: F401
