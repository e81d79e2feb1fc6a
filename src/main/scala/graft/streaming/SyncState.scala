package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

/** T1/T2/T4 — the reference's incremental-sync state machine
  * (`airflow/bitquery.py:175-351`, SURVEY.md §2.10).
  *
  * State per (chain, destination, prefix): the last block synced and its
  * date, plus the candidate range for the in-flight batch. The reference
  * stores this in Airflow Variables; here it is a small JSON file under a
  * checkpoint dir (atomic rename on write — same durability contract as a
  * Structured Streaming offset log, and trivially replaceable by a table).
  */
final case class SyncStatus(
    lastSyncedBlock: Long,
    lastSyncedBlockDate: String,
    latestBlock: Long,
    latestBlockDate: String)

final class SyncState(checkpointDir: String) {
  Files.createDirectories(Paths.get(checkpointDir))

  /** Variable-name convention mirrors `get_variable_name`
    * (`bitquery.py:175-182`). */
  def key(chain: String, destination: String, prefix: String = ""): String =
    (if (prefix.nonEmpty) s"${prefix}_" else "") + s"${chain}_${destination}_sync_status"

  private def path(k: String) = Paths.get(checkpointDir, s"$k.json")

  def get(k: String): Option[SyncStatus] = {
    val p = path(k)
    if (!Files.exists(p)) None
    else {
      val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      def field(name: String): String =
        s.split("\"" + name + "\"\\s*:\\s*")(1).split("[,}]")(0).trim.stripPrefix("\"").stripSuffix("\"")
      Some(SyncStatus(field("last_synced_block").toLong, field("last_synced_block_date"),
        field("latest_block").toLong, field("latest_block_date")))
    }
  }

  def put(k: String, st: SyncStatus): Unit = {
    val json =
      s"""{"last_synced_block": ${st.lastSyncedBlock}, "last_synced_block_date": "${st.lastSyncedBlockDate}", "latest_block": ${st.latestBlock}, "latest_block_date": "${st.latestBlockDate}"}"""
    val tmp = Paths.get(checkpointDir, s".$k.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path(k), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}

object SyncState {

  /** T2 advance decision (`check_sync_status`, `bitquery.py:208-285`):
    * given the destination's high-watermark and the source's head, apply
    * the streaming lag (late-data guard) and the batch-size cap, and
    * decide whether a batch should run.
    *
    * @return the capped candidate `latestBlock` and the go/no-go bit
    *         (reference returns this into a ShortCircuitOperator). */
  def advance(
      lastSynced: Long, sourceHead: Long,
      streamingLag: Long, batchSize: Long): (Long, Boolean) = {
    val lagged = sourceHead - streamingLag
    val capped = math.min(lagged, lastSynced + batchSize)
    (capped, capped > lastSynced)
  }
}
