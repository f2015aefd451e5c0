"""Stateless mask-producing passes. Counterpart of glomap/processors/."""
