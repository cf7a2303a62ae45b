package graft.checkpoint

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.collection.immutable.ListMap
import com.fasterxml.jackson.databind.{ObjectMapper, JsonNode}

/** Build-stage checkpoint manifest (SURVEY.md §7.6).
  *
  * The reference's durability substrate is WAL + recovery
  * (storage/write_ahead_log/, recovery_manager.cpp); ours is snapshot-style:
  * every build stage commits its output as immutable parquet plus a manifest
  * entry recording lineage (input fingerprint, rows, wall ms, per-partition
  * metrics). Restart = read manifest, skip completed stages whose input
  * fingerprint matches (SURVEY.md §4.4).
  *
  * The manifest is written atomically (temp file + ATOMIC_MOVE rename),
  * mirroring the reference's group-commit handoff discipline
  * (log_serializer_task.cpp) — a torn manifest can never be observed.
  */
final case class StageRecord(
    stage: String,
    status: String, // "complete"
    inputFingerprint: String,
    rows: Long,
    wallMs: Long,
    extra: Map[String, String])

final class Manifest(val indexDir: String) {
  private val path = Paths.get(indexDir, "manifest.json")
  private val mapper = new ObjectMapper()

  def read(): ListMap[String, StageRecord] = {
    if (!Files.exists(path)) return ListMap.empty
    val root = mapper.readTree(Files.readAllBytes(path))
    val stages = root.get("stages")
    if (stages == null) return ListMap.empty
    var out = ListMap.empty[String, StageRecord]
    val it = stages.fieldNames()
    while (it.hasNext) {
      val name = it.next()
      val n = stages.get(name)
      val extra = Option(n.get("extra")).map { e =>
        var m = Map.empty[String, String]
        val fit = e.fieldNames()
        while (fit.hasNext) { val k = fit.next(); m += k -> e.get(k).asText() }
        m
      }.getOrElse(Map.empty)
      out += name -> StageRecord(
        stage = name,
        status = n.get("status").asText(),
        inputFingerprint = n.get("inputFingerprint").asText(),
        rows = n.get("rows").asLong(),
        wallMs = n.get("wallMs").asLong(),
        extra = extra)
    }
    out
  }

  def isComplete(stage: String, inputFingerprint: String): Boolean =
    read().get(stage).exists(r =>
      r.status == "complete" && r.inputFingerprint == inputFingerprint)

  def get(stage: String): Option[StageRecord] = read().get(stage)

  /** Record `rec`, preserving other stages; atomic replace. */
  def commit(rec: StageRecord): Unit = {
    val all = read() + (rec.stage -> rec)
    val root = mapper.createObjectNode()
    root.put("version", 1)
    val stages = root.putObject("stages")
    all.foreach { case (name, r) =>
      val n = stages.putObject(name)
      n.put("status", r.status)
      n.put("inputFingerprint", r.inputFingerprint)
      n.put("rows", r.rows)
      n.put("wallMs", r.wallMs)
      val e = n.putObject("extra")
      r.extra.toSeq.sortBy(_._1).foreach { case (k, v) => e.put(k, v) }
    }
    Files.createDirectories(path.getParent)
    val tmp = Paths.get(indexDir, s".manifest.json.tmp")
    Files.write(tmp, mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
    try Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
      Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING)
    }
  }
}
