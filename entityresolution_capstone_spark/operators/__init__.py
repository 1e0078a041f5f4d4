"""Pipeline operators: DataFrame -> DataFrame stages."""
