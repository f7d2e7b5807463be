package graft.operators

/** Second codec for the ServiceLoader path (MiscSpec): claims only
  * `image/test` and returns sentinel dimensions so tests can prove the
  * loader picked it over the [[FakeCodecProvider]] fallback. Registered
  * through `src/test/resources/META-INF/services` — the exact route an
  * online build's javax.imageio provider would take. */
class TestMediaCodec extends MediaCodec {
  override def claims(kind: String): Boolean = kind == "image/test"
  override def decode(row: Multimodal.MediaRow): Multimodal.MediaFeatures =
    Multimodal.MediaFeatures(row.doc_id, row.kind,
      byte_len = row.payload.length.toLong, width = 7, height = 9,
      checksum = 42L, feature = Array(1f))
}
