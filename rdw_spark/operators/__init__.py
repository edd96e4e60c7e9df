"""Engine operators Spark lacks natively, built Spark-first:
compositions of DataFrame ops where semantics allow, Pandas-UDF-backed
plans only where they don't (see SURVEY.md §4 "Built-in vs custom").
"""
