NODATA = -9999.0  # the reference's sentinel (lsma.py:43, utils.py:66)
