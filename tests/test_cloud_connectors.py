"""Cloud connector coordinate pack (sources/cloud.py).

The cloud SDKs are absent from this container, so the tests split into
(a) pure coordinate -> storage-options / URI-parsing checks per protocol,
(b) the real unavailable-backend error path (s3fs IS missing here), and
(c) the full compile-and-read path over the ``file`` protocol — which runs
the byte-identical fsspec -> FSSpecHandler -> PyFileSystem -> distributed
read-task code the cloud protocols use.
"""

from __future__ import annotations

import pytest

from docling_jobkit_ray.sources.cloud import (
    AzureBlobCoordinates,
    ConnectorUnavailable,
    FileNetCoordinates,
    GcsCoordinates,
    GoogleDriveCoordinates,
    LocalCoordinates,
    S3Coordinates,
    coordinates_for_uri,
    filesystem_for,
    read_cloud_pages,
    write_cloud_parquet,
)


def test_s3_storage_options_mapping():
    c = S3Coordinates(
        bucket="b",
        key_prefix="pre/fix/",
        endpoint="minio.local:9000",
        access_key="AK",
        secret_key="SK",
        verify_ssl=False,
        region="us-east-1",
    )
    opts = c.storage_options()
    assert opts["key"] == "AK" and opts["secret"] == "SK"
    assert opts["client_kwargs"]["endpoint_url"] == "http://minio.local:9000"
    assert opts["client_kwargs"]["region_name"] == "us-east-1"
    assert opts["use_ssl"] is False
    assert c.root_path() == "b/pre/fix"
    # https endpoint when verify_ssl left on
    c2 = S3Coordinates(bucket="b", endpoint="s3.example.com")
    assert c2.storage_options()["client_kwargs"]["endpoint_url"] == "https://s3.example.com"
    assert c2.root_path() == "b"


def test_azure_gcs_gdrive_options_mapping(tmp_path):
    a = AzureBlobCoordinates(
        container="cont", key_prefix="docs", account_name="acct", credentials="sas"
    )
    assert a.storage_options() == {"account_name": "acct", "credential": "sas"}
    assert a.root_path() == "cont/docs"

    g = GcsCoordinates(bucket="gb", project="p", credentials_path="/tmp/sa.json")
    assert g.storage_options() == {"project": "p", "token": "/tmp/sa.json"}
    g_inline = GcsCoordinates(bucket="gb", service_account_key='{"type": "service_account"}')
    assert g_inline.storage_options()["token"] == {"type": "service_account"}

    d = GoogleDriveCoordinates(path_id="folder123", credentials_path="/tmp/c.json")
    assert d.storage_options() == {"creds_path": "/tmp/c.json"}
    assert d.root_path() == "folder123"


def test_coordinates_for_uri():
    s3 = coordinates_for_uri("s3://bucket/a/b")
    assert isinstance(s3, S3Coordinates) and s3.bucket == "bucket" and s3.key_prefix == "a/b"

    az = coordinates_for_uri("abfs://cont@acct.dfs.core.windows.net/pre")
    assert isinstance(az, AzureBlobCoordinates)
    assert az.container == "cont" and az.account_name == "acct" and az.key_prefix == "pre"
    az2 = coordinates_for_uri("az://cont/pre")
    assert az2.container == "cont" and az2.account_name is None

    gs = coordinates_for_uri("gs://gb/x")
    assert isinstance(gs, GcsCoordinates) and gs.bucket == "gb" and gs.key_prefix == "x"

    gd = coordinates_for_uri("gdrive://folder123")
    assert isinstance(gd, GoogleDriveCoordinates) and gd.path_id == "folder123"

    loc = coordinates_for_uri("/data/pages")
    assert isinstance(loc, LocalCoordinates) and loc.path == "/data/pages"
    loc2 = coordinates_for_uri("file:///data/pages")
    assert loc2.path == "/data/pages"

    with pytest.raises(ValueError):
        coordinates_for_uri("ftp://host/x")


def test_unavailable_backend_raises_with_install_hint():
    # s3fs genuinely absent from this container: the error path is real.
    with pytest.raises(ConnectorUnavailable, match="s3fs"):
        filesystem_for(S3Coordinates(bucket="b"))


def test_filenet_compiles_to_http_fetch_inputs():
    fn = FileNetCoordinates(
        base_url="https://host/content-services-graphql/",
        username="u",
        api_key="k",
        repository_id="OS1",
        document_ids=("d1", "d2"),
    )
    urls = fn.document_urls()
    assert urls == [
        "https://host/content-services-graphql/content?repositoryIdentifier=OS1&documentId=d1",
        "https://host/content-services-graphql/content?repositoryIdentifier=OS1&documentId=d2",
    ]
    hdrs = fn.auth_headers()
    assert hdrs["Authorization"].startswith("Basic ")
    import base64

    assert base64.b64decode(hdrs["Authorization"][6:]).decode() == "u:k"


def test_cloud_round_trip_over_file_protocol(ray_session, corpus_dir, tmp_path):
    """End-to-end through the identical compile path the cloud protocols
    use: coordinate -> fsspec fs -> PyFileSystem -> distributed read tasks,
    then sink through write_cloud_parquet and read the target back."""
    import ray.data

    ds = read_cloud_pages(LocalCoordinates(path=corpus_dir))
    assert ds.count() == 600

    out_coords = LocalCoordinates(path=str(tmp_path / "cloud_sink"))
    root = write_cloud_parquet(ds.limit(50), out_coords)
    back = ray.data.read_parquet(root, columns=["url"])
    assert back.count() == 50


def test_read_cloud_pages_accepts_uri_string(ray_session, corpus_dir):
    ds = read_cloud_pages(corpus_dir)  # bare path -> LocalCoordinates
    assert ds.count() == 600
