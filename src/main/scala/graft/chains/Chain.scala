package graft.chains

/** Chain ADT — port of the reference's chain registry and per-chain
  * dispatch rules (`dataengineering/chains.py:4-64`, SURVEY.md §2.12).
  *
  * Captures the three name spaces the reference keeps per chain
  * (internal, graph, database), the smart-contract classification that
  * drives metadata routing (`coinprice/utils.py:35-73`), and the
  * first-letter routing rule for the dictionary database
  * (`coinprice/utils.py:54-58` — chains ≥ 's' read
  * `aal_dictionaries.{chain}_tokens_metadata`). */
sealed abstract class Chain(
    val internalName: String,
    val graphName: String,
    val databaseName: String,
    val smartContract: Boolean) {

  /** F7 — metadata table resolution (first-letter ordinal dispatch). */
  def tokensMetadataTable: String =
    if (internalName.head >= 's') s"aal_dictionaries.${internalName}_tokens_metadata"
    else s"$databaseName.tokens_metadata"

  /** Master/txns table dispatch (`clickhouse/utils.py:8-69`): bitcoin
    * family reads `{db}.txns`, account chains read `{db}.master`. */
  def latestBlockTable: String = this match {
    case c if !c.smartContract => s"$databaseName.txns"
    case Chain.Ethereum        => s"$databaseName.tld_raw_hot"
    case _                     => s"$databaseName.master"
  }
}

object Chain {
  case object Bitcoin     extends Chain("bitcoin", "bitcoin", "bitcoin", false)
  case object BitcoinCash extends Chain("bitcoin_cash", "bitcoin_cash", "bitcoin_cash", false)
  case object Litecoin    extends Chain("litecoin", "litecoin", "litecoin", false)
  case object Dogecoin    extends Chain("dogecoin", "dogecoin", "dogecoin", false)
  case object Ethereum    extends Chain("ethereum", "ethereum", "ethereum", true)
  case object Polygon     extends Chain("polygon", "matic", "polygon", true)
  case object Tron        extends Chain("tron", "tron", "tron", true)
  case object Ripple      extends Chain("ripple", "xrp", "ripple", false)
  case object Hedera      extends Chain("hedera", "hbar", "hedera", true)
  case object Solana      extends Chain("solana", "solana", "solana", true)

  val all: Seq[Chain] = Seq(Bitcoin, BitcoinCash, Litecoin, Dogecoin,
    Ethereum, Polygon, Tron, Ripple, Hedera, Solana)

  def byName(name: String): Option[Chain] = all.find(_.internalName == name)

  /** U3 — set membership driving dispatch (`pricing_checks.py:35,50`). */
  def smartContractChains: Set[Chain] = all.filter(_.smartContract).toSet

  /** Tron zeroes fees on inner transfers (P8-tron, `operator.py:486-487`). */
  def hasTronFeeRule(c: Chain): Boolean = c == Tron

  /** Ripple uses the constant-key price join (J3,
    * `streaming_operator.py:239-251`). */
  def hasConstantKeyPricing(c: Chain): Boolean = c == Ripple
}
