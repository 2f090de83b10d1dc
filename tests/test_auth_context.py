"""Interactive-auth gate (sources/auth_context.py): closed by default,
scoped opening, exception-safe restore, connector-compile integration.
Capability parity with the reference's ContextVar gate
(docling_jobkit/connectors/auth_context.py:1-24)."""

from __future__ import annotations

import pytest

from docling_jobkit_ray.sources.auth_context import (
    InteractiveAuthRequired,
    allow_interactive_auth,
    interactive_auth_allowed,
    require_interactive_auth,
)
from docling_jobkit_ray.sources.cloud import (
    GoogleDriveCoordinates,
    LocalCoordinates,
    filesystem_for,
)


def test_gate_closed_by_default():
    assert not interactive_auth_allowed()
    with pytest.raises(InteractiveAuthRequired):
        require_interactive_auth("gdrive")


def test_gate_scoped_and_nested():
    with allow_interactive_auth():
        assert interactive_auth_allowed()
        require_interactive_auth("gdrive")  # no raise
        with allow_interactive_auth():
            assert interactive_auth_allowed()
        assert interactive_auth_allowed()  # inner exit restores OUTER state
    assert not interactive_auth_allowed()


def test_gate_restores_on_exception():
    with pytest.raises(RuntimeError):
        with allow_interactive_auth():
            raise RuntimeError("boom")
    assert not interactive_auth_allowed()


def test_gdrive_without_offline_creds_needs_gate():
    coords = GoogleDriveCoordinates(path_id="folder123")
    assert coords.requires_interactive_auth()
    with pytest.raises(InteractiveAuthRequired):
        filesystem_for(coords)
    # with a refresh token configured, no interactive flow is needed —
    # the compile proceeds to the backend lookup (gdrivefs not installed
    # here, so it surfaces as ConnectorUnavailable, NOT a gate error)
    from docling_jobkit_ray.sources.cloud import ConnectorUnavailable

    offline = GoogleDriveCoordinates(path_id="folder123", refresh_token="tok")
    assert not offline.requires_interactive_auth()
    with pytest.raises(ConnectorUnavailable):
        filesystem_for(offline)


def test_local_coords_never_gated(tmp_path):
    fs, root = filesystem_for(LocalCoordinates(path=str(tmp_path)))
    assert root == str(tmp_path)
    assert fs.get_file_info(root).is_file is False  # directory exists


def test_dynamic_scheme_registry(tmp_path):
    """Plugin-registered URI schemes join coordinates_for_uri dispatch —
    the reference's dynamic connector-config union rebuilt as a parser
    registry (datamodel/dynamic_unions.py capability parity)."""
    import pytest as _pytest

    from docling_jobkit_ray.sources.cloud import (
        LocalCoordinates,
        coordinates_for_uri,
        register_coordinate_scheme,
        registered_coordinate_schemes,
    )

    assert "s3" in registered_coordinate_schemes()
    with _pytest.raises(ValueError):
        coordinates_for_uri("myvault://tenant/prefix")

    def parse_myvault(uri, host, path):
        return LocalCoordinates(path=f"/vault/{host}/{path}")

    register_coordinate_scheme("myvault", parse_myvault)
    try:
        c = coordinates_for_uri("myvault://tenant/prefix")
        assert c.root_path() == "/vault/tenant/prefix"
        # builtins cannot be silently shadowed
        with _pytest.raises(ValueError):
            register_coordinate_scheme("s3", parse_myvault)
        # explicit replace is allowed (and restored below)
        register_coordinate_scheme("myvault", parse_myvault, replace=True)
    finally:
        from docling_jobkit_ray.sources import cloud as _cloud

        _cloud._SCHEME_PARSERS.pop("myvault", None)
