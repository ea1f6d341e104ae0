from pygpr_tpu.interop.sklearn import SK_WRAP, SKWrap
