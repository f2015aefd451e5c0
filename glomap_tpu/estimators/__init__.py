"""Optimization engines. Counterpart of reference glomap/estimators/."""
