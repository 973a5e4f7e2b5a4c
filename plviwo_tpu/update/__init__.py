"""L3 measurement updaters: camera (points + lines), wheel, GPS."""
