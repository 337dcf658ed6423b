"""openelevationservice_spark — PySpark-native spatial-join + tiling engine."""
