"""Pipeline orchestration. Counterpart of reference glomap/controllers/."""
