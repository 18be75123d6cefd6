"""Pure-numpy kernels and portable column-expression builders."""
