"""Turn-local extraction kernel.

Everything in this package runs INSIDE one ``mapInPandas`` Arrow batch
(SURVEY.md §2 tier [T]): whole-document algorithms over numpy arrays,
one document per transcript turn — exactly as one PDF fits in the
reference's memory. No Spark imports here; the kernel is pure
numpy/pandas and unit-testable without a JVM.
"""
