"""TT constructors: cross interpolation, DIRT training, ALS-Cross."""
