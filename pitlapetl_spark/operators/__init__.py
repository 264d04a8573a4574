"""Operator library — each module registers queries via
:mod:`pitlapetl_spark.registry`."""
