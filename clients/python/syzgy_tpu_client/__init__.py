"""syzgy_tpu_client — typed REST client for syzgydb_tpu.

API-surface parity with the reference pip package `syzgy`
(/root/reference/python_client/syzgy/): SyzgyClient with
create/get/delete_collection, Collection with insert_documents /
update_document_metadata / delete_document / search / get_document_ids,
dataclasses Document/SearchResult/CollectionInfo, SyzgyException raised on
HTTP >= 400.  (The reference client reads response keys its own server never
sends — collection_name/distance_function in listings — this client uses the
keys the server actually returns: name/distance_method.)

Stdlib-only (urllib), no external dependencies.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request
from dataclasses import asdict, dataclass, field
from typing import Dict, List, Optional

__all__ = ["SyzgyClient", "Collection", "CollectionInfo", "Document",
           "SearchResult", "SearchResponse", "SyzgyException"]


class SyzgyException(Exception):
    pass


@dataclass
class CollectionInfo:
    name: str
    document_count: int
    dimension_count: int
    quantization: int
    distance_method: str


@dataclass
class Document:
    id: int
    vector: Optional[List[float]] = None
    text: Optional[str] = None
    metadata: Optional[Dict] = None

    def to_dict(self) -> dict:
        return {k: v for k, v in asdict(self).items() if v is not None}


@dataclass
class SearchResult:
    id: int
    metadata: Dict
    distance: float


@dataclass
class SearchResponse:
    results: List[SearchResult] = field(default_factory=list)
    percent_searched: float = 0.0
    search_time: int = 0
    embedding_time: int = 0


class SyzgyClient:
    def __init__(self, base_url: str):
        self.base_url = base_url.rstrip("/")

    def _request(self, method: str, endpoint: str, body: Optional[dict] = None):
        url = f"{self.base_url}{endpoint}"
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(
            url, data=data, method=method,
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req) as resp:
                payload = resp.read()
        except urllib.error.HTTPError as exc:
            detail = exc.read().decode(errors="replace")
            raise SyzgyException(
                f"HTTP {exc.code}: {exc.reason}\nResponse body: {detail}") \
                from exc
        except urllib.error.URLError as exc:
            raise SyzgyException(f"Connection failed: {exc}") from exc
        try:
            return json.loads(payload) if payload else None
        except json.JSONDecodeError as exc:
            raise SyzgyException(
                f"Invalid JSON response: {payload[:200]!r}") from exc

    # -- collections -------------------------------------------------------

    def create_collection(self, name: str, vector_size: int,
                          quantization: int = 64,
                          distance_function: str = "cosine") -> "Collection":
        self._request("POST", "/api/v1/collections", {
            "name": name, "vector_size": vector_size,
            "quantization": quantization,
            "distance_function": distance_function})
        return Collection(self, CollectionInfo(
            name, 0, vector_size, quantization, distance_function))

    def get_collections(self) -> List["Collection"]:
        result = self._request("GET", "/api/v1/collections")
        return [Collection(self, CollectionInfo(
            c["name"], c["document_count"], c["dimension_count"],
            c["quantization"], c["distance_method"])) for c in result]

    def get_collection(self, name: str) -> "Collection":
        c = self._request("GET", f"/api/v1/collections/{name}")
        return Collection(self, CollectionInfo(
            name, c["document_count"], c["dimension_count"],
            c["quantization"], c["distance_method"]))

    def delete_collection(self, name: str) -> dict:
        return self._request("DELETE", f"/api/v1/collections/{name}")


class Collection:
    def __init__(self, client: SyzgyClient, info: CollectionInfo):
        self.client = client
        self.info = info
        self.collection_name = info.name

    def _path(self, suffix: str = "") -> str:
        return f"/api/v1/collections/{self.collection_name}{suffix}"

    def insert_documents(self, documents: List[Document]) -> dict:
        return self.client._request(
            "POST", self._path("/records"),
            [d.to_dict() if isinstance(d, Document) else d
             for d in documents])

    def update_document_metadata(self, document_id: int,
                                 metadata: Dict) -> dict:
        return self.client._request(
            "PUT", self._path(f"/records/{document_id}/metadata"),
            {"metadata": metadata})

    def delete_document(self, document_id: int) -> dict:
        return self.client._request("DELETE",
                                    self._path(f"/records/{document_id}"))

    def search(self, vector: Optional[List[float]] = None,
               text: Optional[str] = None, k: Optional[int] = None,
               radius: Optional[float] = None, limit: Optional[int] = None,
               offset: Optional[int] = None, precision: Optional[str] = None,
               filter: Optional[str] = None) -> SearchResponse:
        """precision: "" / "medium" (sketch ANN, fastest single query),
        "high" (exhaustive segment-min scan, near-exact, best batched
        throughput), or "exact" (full-f32 scan).  Concurrent searches are
        coalesced into shared device batches server-side."""
        body = {k2: v for k2, v in {
            "vector": vector, "text": text, "k": k, "radius": radius,
            "limit": limit, "offset": offset, "precision": precision,
            "filter": filter}.items() if v is not None}
        result = self.client._request("POST", self._path("/search"), body)
        return SearchResponse(
            results=[SearchResult(**item) for item in result["results"]],
            percent_searched=result.get("percent_searched", 0.0),
            search_time=result.get("search_time", 0),
            embedding_time=result.get("embedding_time", 0))

    def get_document_ids(self) -> List[int]:
        return self.client._request("GET", self._path("/ids"))
