"""Constant tables of the Vorbis I specification.

``floor1_inverse_dB_table`` is the 256-entry float32 table published in the
Vorbis I specification, section 10.1 (the values are exp((i-255) * 0.0629615,
rounded by the spec authors; we embed the exact published float32 bit
patterns as data because no closed-form expression reproduces every entry to
the last ulp).  The reference consumes the same table at
/root/reference/src/ParseOggVorbis.hpp:586-589.
"""

from __future__ import annotations

import base64
import zlib

import numpy as np

_INVERSE_DB_TABLE_F32_ZB64 = (
    "eNoFwQtQk3UAAPANUjcpbaPOZIgmbFwkY7Dv+X98n0A1yDiNl3QKx3glFsXDRxycbCCxaUYbxyNYYZyMqKMNkQscKUciDDuo"
    "k5dJaRt4cJzBoAIO6vr9uBuzarFpVX35upBAB3YSgX6+RHq7P9E2pSCO2MKJYxAT+VWxRODVZKLHnEUk5RURhmY9seVziah5"
    "pobINVuIiNtWgq/tJGr2/0DM5jqJDt0kQRXMEtbYVcLwiZDsXxOT25ek5LkSf7LfqiDpknDyV29Mpr0VS0JtMtl7NIvckheR"
    "l4r15MduI1n6wExWZlnI+E+tpFrbScrn+8gZpZMcjZwkI5Wz5HGvVbI6R0gdHRNTf/8opRri/Kn5swoqQhNOnfkJUWmSWCr7"
    "YDI1+mwW1fN7IVWfoKf8HUaq8DszZaMslD7VSpGhndSQvY+aXR2mhN6TVPqimwpwrFAth4X0olVMexqktHO/Px3wuoLGvuF0"
    "QC2iP5yMoVvcSfSaM5M21hfStlA9fctspM9UmOknIgt965CV1mzY6eLiPvq/nmFac2eCNn/tpteLVuh+PyFTc0HMbORJme0r"
    "MibjBQWT/EjFTKcixtwUw6xcS2LUVZnMB8cKmfs79Mx7p41MeYqZCXnYxIi3WplTg3YGRvUxr1wYZq5WTjAPst3M/KEVZuEv"
    "AftGspjdFS1l374jY7vdcrbsWxXbokDsYHoMm5CTxFa8lsmeEheyQpeODYoysl+EmtmSjiY2814r+7nJzj7n08fmRA+zPpoJ"
    "NiLQzT6d87D7xgRgm1IMVC9JQXudDLzYJQffn1eB0iUIdipiwFBwEngizAQfDRQA2KcDC3uN4K6XGTwsawL3GlvBdKodLN13"
    "gC7RMDCIJkDzYxfY0ewBJ9sF8OdtYpj2VAJ358rgxXI5/DdaBd/tgVC7qIFxC4kw9XYGtJQUwLI6HbzpMcCNKRPUxDfByNOt"
    "MDjEDl0WB5SODsE9I+PwwJcuSKZ4oLVCgNp+E6GGAQkqhzIkjJejxOdVSKuHaNiuQXPfJKL50gw0ThSgsXwdqnMaEOgwof6g"
    "JjTItqLKf2xoLtuBymuGUO/lcXTjhAsVSzxoM1WAjd0i/Khegr12yfCVl+W4dyYM570J8eFzGmx6PxFXggx88M98HHJEh8u+"
    "MmBDuQnHrDXiFHErXhmw4XWlA3u/M4Tz4sbxyb0u/MvIMj7BCLjzV0ScOk/CffbYjwv2BHHK9jCuyhdyI1DDxSkTOXpdy11s"
    "y+eq5TquqNjAuY6buBlnI7cxfY3Lq7ZxsvWbXG3AEKfePc7tmfqDwxeXubtSAV+YLeJroiT8q11+/Gh/EN95Noy/PgP4bKGG"
    "37ecwG92a/nN9HxeINDx/wPr7KZ/"
)


def _decode_table() -> np.ndarray:
    raw = zlib.decompress(base64.b64decode(_INVERSE_DB_TABLE_F32_ZB64))
    table = np.frombuffer(raw, dtype=np.float32).copy()
    assert table.shape == (256,) and table[-1] == 1.0
    return table


INVERSE_DB_TABLE = _decode_table()
