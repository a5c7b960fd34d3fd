package graft.queries

import graft.Td
import graft.operators.MultimodalOps

/** Parity query for the multimodal BINARY-column plumbing
  * ([[graft.operators.MultimodalOps]]): payloads packed as binary with a
  * typed metadata struct, pseudo image metadata derived through the
  * codegen'd expression decode path. The imperative `decodeBatch` path is
  * covered by MultimodalSpec (mapPartitions output is not SQL-expressible
  * for the oracle).
  */
object MultimodalQueries {

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("q61_multimodal_meta",
      (s, dir) =>
        MultimodalOps.withFakeDecode(
          MultimodalOps.packDocuments(Td.load(s, dir, "documents")))
          .selectExpr(
            "doc_id",
            "meta.n_bytes AS n_bytes",
            "meta.content_hash AS content_hash",
            "meta.mime AS mime",
            "img_w", "img_h", "n_frames",
            "round(CAST(img_w AS DOUBLE) / CAST(img_h AS DOUBLE), 4) AS aspect_ratio")
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
                     octet_length(encode(text)) AS n_bytes,
                     md5(text) AS content_hash,
                     'text/plain' AS mime,
                     160 + CAST(instr('0123456789abcdef', substring(md5(text), 1, 1)) - 1 AS BIGINT) * 32 AS img_w,
                     120 + CAST(instr('0123456789abcdef', substring(md5(text), 2, 1)) - 1 AS BIGINT) * 24 AS img_h,
                     octet_length(encode(text)) % 7 + 1 AS n_frames,
                     round(CAST(160 + CAST(instr('0123456789abcdef', substring(md5(text), 1, 1)) - 1 AS BIGINT) * 32 AS DOUBLE) /
                           CAST(120 + CAST(instr('0123456789abcdef', substring(md5(text), 2, 1)) - 1 AS BIGINT) * 24 AS DOUBLE), 4) AS aspect_ratio
              FROM documents ORDER BY doc_id"""))
  )
}
