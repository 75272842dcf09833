"""Sources: unified2 binary files, plus CSV/JSON/JDBC wrappers."""
