"""CFMask / pixel-QA value tables (reference eos.py:8-23; values are
published USGS Landsat surface-reflectance QA code tables).

Used as the IN-lists of the cfmask membership predicate
(utils.cfmask, utils.py:230-263; engine form: queries/raster_q.q_cfmask_isin
and raster/masks.cfmask).
"""

# Landsat 4-7 Pre-Collection pixel_qa values to be masked
MASK_LANDSAT47_PRECOLLECTION = (1, 2, 3, 4, 255)

# Landsat 4-7 Collection 1 pixel_qa ("Medium" confidence)
MASK_LANDSAT47_C1 = (1, 68, 72, 80, 112, 132, 136, 144, 160, 176, 224)

# Landsat 8 Collection 1 pixel_qa ("Medium" confidence)
MASK_LANDSAT8_C1 = (1, 324, 328, 386, 388, 392, 400, 416, 432, 480, 832,
                    836, 840, 848, 864, 880, 900, 904, 912, 928, 944, 992,
                    1024)
